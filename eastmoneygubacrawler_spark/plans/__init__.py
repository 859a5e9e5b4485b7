from .audit import explain_str, assert_pushed_filters, assert_no_row_udf  # noqa: F401
