"""Input connectors: parquet/Iceberg tables and directory-of-files scans."""
