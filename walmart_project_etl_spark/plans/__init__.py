"""Layer plans: CSV → ODS → Staging → Target, each a pure DataFrame function."""
