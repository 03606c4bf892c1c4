"""Offline tooling: HaGRID extraction, dataset inspection, profiling."""
