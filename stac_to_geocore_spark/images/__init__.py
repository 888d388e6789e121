from stac_to_geocore_spark.images.codecs import (
    decode_image,
    encode_image,
    phash64,
    psnr,
)

__all__ = ["decode_image", "encode_image", "phash64", "psnr"]
