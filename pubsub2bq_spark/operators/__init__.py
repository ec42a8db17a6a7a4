"""Operator library: each module registers queries into the registry."""
