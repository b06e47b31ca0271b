"""Relational operators — DataFrame/SQL only, so Catalyst optimizes them."""
