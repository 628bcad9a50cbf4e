"""Plan composition: the end-to-end extraction pipeline and the query catalog."""
