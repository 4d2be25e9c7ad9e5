"""Scalar/column function library (pure builders, no session state)."""
