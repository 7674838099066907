from redshells_spark.data.frame_ops import (
    convert_to_one_hot,
    extract_column,
    extract_column_as_dict,
    filter_by_column,
    group_by_column_as_dict,
    head_cap,
    rename_column,
    sample_data,
    split_train_test_data,
)

__all__ = [
    "convert_to_one_hot",
    "extract_column",
    "extract_column_as_dict",
    "filter_by_column",
    "group_by_column_as_dict",
    "head_cap",
    "rename_column",
    "sample_data",
    "split_train_test_data",
]
