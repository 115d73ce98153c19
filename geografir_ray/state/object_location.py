"""ObjectLocation — storage-location value object
(/root/reference/object_storage/src/object_storage/object_location.py:54-233
re-implemented without pydantic/boto3; used by the engine as the URI
layer over ray.data read/write paths and the checkpoint layout).

Exact semantics preserved:
- is_directory = trailing "/" (object_location.py:71-94)
- s3_uri = f"s3://{bucket}/{path}" (object_location.py:96-128)
- extend: strip trailing "/" on base, leading "/" on part, join with
  one "/" (object_location.py:155-170)
- from_s3_uri: non-s3 scheme → Exception with the reference's message;
  "//" in path → ValueError with the reference's message
  (object_location.py:205-218)
- value semantics: eq by (bucket, path), hashable, str → s3_uri
  (object_location.py:221-233)
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlparse


@dataclass(frozen=True)
class ObjectLocation:
    bucket: str
    path: str

    @property
    def is_directory(self) -> bool:
        return self.path.endswith("/")

    @property
    def s3_uri(self) -> str:
        return f"s3://{self.bucket}/{self.path}"

    def extend(self, new_part: str) -> "ObjectLocation":
        path = self.path[:-1] if self.path.endswith("/") else self.path
        path_extension = new_part[1:] if new_part.startswith("/") else new_part
        return ObjectLocation(bucket=self.bucket, path=f"{path}/{path_extension}")

    @staticmethod
    def from_s3_uri(s3_uri: str) -> "ObjectLocation":
        parsed = urlparse(s3_uri)
        if parsed.scheme != "s3":
            raise Exception(
                "Argument to ObjectLocation.from_s3_uri must begin with 's3'"
            )
        if "//" in parsed.path:
            raise ValueError(
                "s3_uri contains `//` in its path portion, which is not supported."
            )
        return ObjectLocation(bucket=parsed.netloc, path=parsed.path[1:])

    def __str__(self) -> str:
        return self.s3_uri
