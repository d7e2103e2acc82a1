"""Column-level functions: checksums, geotag extraction, text analysis,
vector math. All JVM-side built-ins (whole-stage codegen) unless noted."""
