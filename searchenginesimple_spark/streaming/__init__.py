"""Structured Streaming mirrors of the reference's (only) stream path."""
