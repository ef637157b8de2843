"""Logical-plan layer: the SQL view surface (S5) registered over engine
tables. Declarative views keep Catalyst free to inline, prune, and push
down — the Spark analog of PG's parse->rewrite view inlining."""
