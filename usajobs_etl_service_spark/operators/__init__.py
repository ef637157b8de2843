"""Relational + extension operators. Each module documents the SURVEY §2
operator IDs it implements and the reference file:line it matches."""
