"""quichash_spark — PySpark-native near-duplicate detection engine."""
