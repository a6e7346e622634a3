from pdf_parser_spark.oracle import refsem  # noqa: F401
