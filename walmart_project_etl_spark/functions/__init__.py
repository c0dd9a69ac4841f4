"""Column-expression building blocks (keys, business rules, text analysis)."""
