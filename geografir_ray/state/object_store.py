"""ObjectStore — S3-compatible storage wrapper
(/root/reference/object_storage/src/object_storage/object_store.py:53-455
re-implemented; same operation semantics, same quirks, documented).

In the engine this is the resumability layer (SURVEY.md §2 ops 41-48):
``list_files`` = source discovery, ``remote_file_exists`` =
skip-completed-partition probe, ``copy_remote_file`` = checkpoint
promotion.  The Ray pipelines use pyarrow.fs / ray.data paths for bulk
data; this wrapper exists for control-plane objects (manifests,
_SUCCESS markers) and reference parity.

Quirks preserved deliberately (SURVEY.md §2.1 behavioral-quirk list):
- download_directory names files by basename only → collisions possible
  (object_store.py:237-243)
- copy_remote_directory flattens subdirectories via basename
  (object_store.py:450-453)
- remote_file_exists does NOT pass RequestPayer (inconsistent with
  list_files :118 — object_store.py:366-368)
- sequential loops; first failure halts, completed files remain
  (object_store.py:215-221)
"""

from __future__ import annotations

import os

from .object_location import ObjectLocation


class ObjectStore:
    def __init__(self, s3_client, requester_pays: bool = False):
        self._s3_client = s3_client
        self._requester_pays = requester_pays

    def list_files(self, object_location: ObjectLocation) -> list[ObjectLocation]:
        """Full listing with ContinuationToken pagination
        (object_store.py:77-131)."""
        continuation_token = None
        keys: list[ObjectLocation] = []
        while True:
            extra = (
                {"ContinuationToken": continuation_token}
                if continuation_token is not None
                else {}
            )
            result = self._s3_client.list_objects_v2(
                Bucket=object_location.bucket,
                Prefix=object_location.path,
                RequestPayer="requester" if self._requester_pays else "owner",
                **extra,
            )
            for entry in result.get("Contents", []):
                keys.append(
                    ObjectLocation(bucket=object_location.bucket, path=entry["Key"])
                )
            if not result["IsTruncated"]:
                return keys
            continuation_token = result["NextContinuationToken"]

    def download_file(
        self,
        object_location: ObjectLocation,
        local_directory: str,
        local_filename: str | None = None,
    ) -> str:
        if not local_filename:
            local_filename = os.path.basename(object_location.path)
        download_path = os.path.join(local_directory, local_filename)
        self._s3_client.download_file(
            Bucket=object_location.bucket,
            Key=object_location.path,
            Filename=download_path,
            ExtraArgs={"RequestPayer": "requester"} if self._requester_pays else {},
        )
        return download_path

    def download_directory(
        self, object_location: ObjectLocation, local_directory: str
    ) -> list[str]:
        """Sequential listing + per-file download; basename naming (so
        same-named files in subdirs collide — preserved quirk)."""
        remote_locations = self.list_files(object_location=object_location)
        return [
            self.download_file(
                object_location=loc, local_directory=local_directory
            )
            for loc in remote_locations
        ]

    def upload_file(
        self, object_location: ObjectLocation, local_filepath: str
    ) -> None:
        if not os.path.exists(local_filepath):
            raise ValueError(f"File not found: {local_filepath}.")
        self._s3_client.upload_file(
            Filename=local_filepath,
            Bucket=object_location.bucket,
            Key=object_location.path,
        )

    def upload_directory(
        self,
        object_location: ObjectLocation,
        local_directory: str,
        recursive: bool = False,
    ) -> None:
        """os.walk topdown; non-recursive keeps only the first level
        (object_store.py:321-324); relative paths preserved via extend."""
        directory_tree = list(os.walk(local_directory, topdown=True))
        directory_tree = directory_tree if recursive else directory_tree[:1]
        for root, _dirs, files in directory_tree:
            for file in files:
                local_path = os.path.join(root, file)
                relative_path = str(os.path.relpath(local_path, local_directory))
                self.upload_file(object_location.extend(relative_path), local_path)

    def remote_file_exists(self, object_location: ObjectLocation) -> bool:
        """MaxKeys=1 prefix probe; no RequestPayer (preserved
        inconsistency, object_store.py:366-368)."""
        response = self._s3_client.list_objects_v2(
            Bucket=object_location.bucket, Prefix=object_location.path, MaxKeys=1
        )
        return "Contents" in response

    def copy_remote_file(
        self,
        src_object_location: ObjectLocation,
        dst_object_location: ObjectLocation,
    ) -> None:
        self._s3_client.copy(
            {
                "Bucket": src_object_location.bucket,
                "Key": src_object_location.path,
            },
            dst_object_location.bucket,
            dst_object_location.path,
        )

    def copy_remote_directory(
        self,
        src_object_location: ObjectLocation,
        dst_object_location: ObjectLocation,
    ) -> None:
        """List + per-file copy; destination key = base + basename, so
        subdirectories FLATTEN (preserved quirk, object_store.py:450-453)."""
        for src_location in self.list_files(src_object_location):
            dst_location = dst_object_location.extend(
                os.path.basename(src_location.path)
            )
            self.copy_remote_file(src_location, dst_location)
