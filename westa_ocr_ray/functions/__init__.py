from .scalar import (  # noqa: F401
    csv_quote, extract_drive_id, mask_token, preview, regex_extract_first,
    build_masters_csv, substitute_template)
