from .bucketing import BucketInfo, bucket_size, pad_to_bucket, unpad
from .cache import enable_compilation_cache
from .shapes import Canon, canon_like, canon_problem
