"""Sources, sinks, and the robust CSV reader (reference stages 1-2)."""
