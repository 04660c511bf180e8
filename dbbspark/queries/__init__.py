"""Declared-query modules. Importing a module registers its queries in
`dbbspark.catalog.CATALOG` (see `catalog.load_all`)."""
