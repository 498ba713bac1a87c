"""Shared scalar/aggregate SQL fragments used by both engines."""
