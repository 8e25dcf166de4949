"""Column-returning helper functions (SURVEY.md §2.7) — pure Catalyst
expressions, fully inside whole-stage codegen. No UDFs here."""
