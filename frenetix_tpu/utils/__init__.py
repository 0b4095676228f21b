"""Config system, logging, misc helpers."""
