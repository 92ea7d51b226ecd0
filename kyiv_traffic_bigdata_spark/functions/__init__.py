"""Column-expression libraries (pure Catalyst expressions, no row UDFs)."""
