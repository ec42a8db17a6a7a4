"""Declarative pipeline specs — the engine's analog of the reference's
config-driven topology (Terraform + .properties)."""
