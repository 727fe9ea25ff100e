"""Filled in later this round."""
