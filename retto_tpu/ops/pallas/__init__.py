from .db_pack import binarize_dilate_pack_rows, unpack_rows

__all__ = ["binarize_dilate_pack_rows", "unpack_rows"]
