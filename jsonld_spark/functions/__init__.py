"""Scalar/document functions for the training-data pipeline ops."""
