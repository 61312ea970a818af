"""Data models: schemas, configs, results, expressions.

TPU-native re-design of the reference model vocabulary
(reference lib/src/model/table_schema.dart, data_store_config.dart,
db_result.dart, query_result.dart, expr.dart).
"""
