"""Command-line entry points (the reference's train.py + scripts/)."""
