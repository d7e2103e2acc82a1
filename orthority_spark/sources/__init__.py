"""Sources: synthetic pages, footprint fixtures, param readers, DEM tiles."""
