"""Operator library: parity-layer dataflow ops + LLM-pipeline ops."""
