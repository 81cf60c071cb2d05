"""Subpackage: parallel."""
