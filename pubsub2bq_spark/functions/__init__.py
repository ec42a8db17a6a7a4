"""Reusable function layers (privacy views, text metrics, hashing)."""
