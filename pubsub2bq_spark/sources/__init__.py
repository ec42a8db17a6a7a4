"""Source connectors + fixtures: file-emulated CDC feed, Pub/Sub-style
raw message model."""
