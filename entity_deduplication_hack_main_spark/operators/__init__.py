"""Relational operator layer: candidate generation, verification, clustering,
ranking, kNN, entity verification, evaluation — each a composition of
DataFrame primitives (SURVEY.md §2 mapping)."""
