"""Runtime compatibility shims for optional pyspark dependencies this
container lacks. Nothing here is imported on the hot path; each shim is
opt-in and degrades to a no-op when its precondition is absent."""
