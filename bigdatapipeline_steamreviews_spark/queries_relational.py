"""Placeholder — populated as operators land."""
