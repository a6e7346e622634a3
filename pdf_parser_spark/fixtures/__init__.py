from pdf_parser_spark.fixtures.gen import (  # noqa: F401
    fixture_corpus,
    to_rows,
    to_spark_df,
    write_parquet,
)
