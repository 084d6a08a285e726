from lucene_ray.codec.smallfloat import (
    int_to_byte4,
    byte4_to_int,
    LENGTH_TABLE,
    int_to_byte4_array,
)

__all__ = ["int_to_byte4", "byte4_to_int", "LENGTH_TABLE", "int_to_byte4_array"]
