"""Shared utilities: metrics, logging, experiment provenance."""
