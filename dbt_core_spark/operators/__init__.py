"""Physical operators: materializations, generic tests, LLM-pipeline ops."""
