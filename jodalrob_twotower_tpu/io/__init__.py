from jodalrob_twotower_tpu.io.tfrecord import (  # noqa: F401
    TFRecordReader,
    TFRecordWriter,
    count_records,
    decode_example,
    encode_example,
    inspect_tfrecord,
    search_records,
    table_to_tfrecord,
)
