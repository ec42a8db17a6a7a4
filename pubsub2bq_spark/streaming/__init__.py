"""Structured-Streaming re-architecture of the reference CDC pipeline."""
