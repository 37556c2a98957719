"""Incremental / streaming validation (foreachBatch over the same engine)."""
