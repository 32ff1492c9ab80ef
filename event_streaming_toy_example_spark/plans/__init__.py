"""Plans: end-to-end pipeline jobs and the oracle-checked query catalog."""
