"""Utilities: distance transforms, profiling helpers."""
