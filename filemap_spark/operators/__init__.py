"""Operator modules, one per SURVEY §2 section. Importing a module registers
its queries/oracles in `filemap_spark.registry`."""
