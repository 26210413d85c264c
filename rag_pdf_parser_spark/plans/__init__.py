"""End-to-end extraction plans: resumable pipeline with per-partition lineage."""
