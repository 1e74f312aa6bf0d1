"""Index structures (build + query)."""
