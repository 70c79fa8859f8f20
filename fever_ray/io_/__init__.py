"""Sources, sinks, checkpoint manifest, lineage/metrics writers."""
