#!/bin/bash
# /verify recipe: fresh-process library drive from OUTSIDE the repo
# (exercises addPyFile shipping) + driver-contract smoke.
set -e
cd /tmp && python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
from search_engine_spark.session import get_spark
spark = get_spark(master="local[4]", shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
from search_engine_spark.sources.corpus import generate_corpus
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import search
idx = build_index(generate_corpus(spark, 300, seed=7).cache())
got = [(r['doc_id'], round(r['score'],4)) for r in search(idx, 'banana recipe', k=3).collect()]
assert got and got[0][0] == 140, got
print("library drive OK:", got)
PYEOF
cd /root/repo && python - <<'PYEOF'
import __spark_entry__ as e
from search_engine_spark.session import get_spark
spark = get_spark(master='local[4]', extra_conf={'spark.ui.enabled':'false'})
spark.sparkContext.setLogLevel('ERROR')
df = e.entry(spark)
n = df.count()
assert n >= 0 and df.columns == ['doc_id', 'score'], (n, df.columns)
qs, osql = e.queries(), e.oracle_sql()
assert set(osql) <= set(qs)
print(f"driver contract OK: entry {n} rows, {len(qs)} queries / {len(osql)} oracles")
PYEOF
echo "verify_quick: ALL OK"
