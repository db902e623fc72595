"""Sources & sinks (E1, E4, R5/R6)."""
