"""Structured Streaming: the parity pipeline as an unbounded job."""
