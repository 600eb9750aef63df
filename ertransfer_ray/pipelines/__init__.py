"""End-to-end wired pipelines and the metrics/conformance layer."""
