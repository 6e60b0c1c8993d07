from jodalrob_twotower_tpu.io.tfrecord import (  # noqa: F401
    TFRecordReader,
    TFRecordWriter,
    decode_example,
    encode_example,
    inspect_tfrecord,
)
