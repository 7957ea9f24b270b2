from .loader import ImageDataset, get_dataset_and_info
from .synthetic import make_synthetic_dataset, synthetic_images
from .tfrecord import (TFRecordWriter, decode_example, encode_example,
                       load_metadata, parse_image_example, read_records,
                       write_image_dataset)
