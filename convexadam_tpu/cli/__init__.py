"""Command-line entry points (argparse parity with the reference CLIs)."""
