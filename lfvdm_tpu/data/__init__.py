from .datasets import (
    video_data_paths_dict,
    default_T_dict,
    default_image_size_dict,
    data_encoding_stats_dict,
    load_data,
    get_test_dataset,
    SyntheticVideoDataset,
)
