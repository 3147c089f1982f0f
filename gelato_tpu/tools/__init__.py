"""Offline post-processing tools: plots and KML export."""
