"""Utilities: torch checkpoint porting, drawing, visualization, profiling."""
