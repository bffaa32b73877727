"""Sources: corpus generation / table loading."""
