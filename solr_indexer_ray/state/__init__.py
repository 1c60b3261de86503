"""Checkpoint / manifest state for resumable index builds."""
