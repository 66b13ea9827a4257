"""Logical plans: end-to-end pipeline assembly, metrics, checkpoint/resume."""
