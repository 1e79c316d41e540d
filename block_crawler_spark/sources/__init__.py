"""Table readers and synthetic fixture generators."""
