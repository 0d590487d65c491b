from .extract import build_extracted_units, extract_dataset, run_extract  # noqa: F401
