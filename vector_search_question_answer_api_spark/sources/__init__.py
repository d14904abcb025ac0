from vector_search_question_answer_api_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]
