from .loaders import load_csv_docs, load_json_docs, load_text_lines

__all__ = ["load_csv_docs", "load_json_docs", "load_text_lines"]
