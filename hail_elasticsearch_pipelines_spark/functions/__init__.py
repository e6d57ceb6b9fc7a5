"""Pure column-level + scalar functions shared by engine and test oracles."""
