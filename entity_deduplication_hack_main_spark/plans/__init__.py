"""Plan layer: end-to-end pipeline orchestration, stage commit protocol,
lineage rows, resume."""
