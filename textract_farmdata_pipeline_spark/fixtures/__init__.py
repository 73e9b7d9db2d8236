from .ocr_lines import OCR_LINES_SQL, load_ocr_lines, ocr_lines_cte  # noqa: F401
