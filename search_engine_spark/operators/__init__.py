"""Engine operators: tokenize, index build, query, rank, graph, dedup..."""
