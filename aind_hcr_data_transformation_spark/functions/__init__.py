"""Scalar/array helper functions shared by operator modules."""
