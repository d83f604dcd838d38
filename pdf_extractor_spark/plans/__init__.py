"""End-to-end jobs: the extraction pipeline and the lineage/resume manifest."""
