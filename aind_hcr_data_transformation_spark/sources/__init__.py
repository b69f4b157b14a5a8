"""Sources: stack catalogs and block readers (SURVEY §2.1)."""
