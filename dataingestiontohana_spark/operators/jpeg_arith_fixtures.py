"""REAL arithmetic-coded JPEG streams for the q204 value gate
(media ids 24-29): constant-block md5 mosaics (the exact q204 pixel
formula, pattern md5("{id}:jpg:0")) encoded ONCE with the system
libjpeg-turbo at quality 100 (unit quantization) by
tests/data/jpeg_arith/gen_embedded.c (committed — provenance). Ids
divisible by 3 carry restart intervals (DRI 2), exercising the
arithmetic coder's restart reinit inside the value gate.

Embedded as constants so the runtime corpus stays self-contained and
deterministic: the DuckDB oracle recomputes the expected moments from
the md5 seed (constant blocks at unit quantization decode exactly),
so these third-party streams are adjudicated value-exactly against an
independent formula — the strongest possible gate for an entropy
decoder."""

import base64

ARITH_MOSAIC_JPEGS: dict[int, bytes] = {
    24: base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/yQALCAAQABgBAREA"
    "/8wABgAQEAX/3QAEAAL/2gAIAQEAAD8A/wD3MNpa/9D/AO2tke7/0f8A7jUdkP/Z"
    ),
    25: base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/yQALCAAQABgBAREA"
    "/8wABgAQEAX/2gAIAQEAAD8A0ut+J6zCuHouCZVW3P/Z"
    ),
    26: base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/yQALCAAQABgBAREA"
    "/8wABgAQEAX/2gAIAQEAAD8A0t9YPdO8WvYE5YofvUD/2Q=="
    ),
    27: base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/yQALCAAQABgBAREA"
    "/8wABgAQEAX/3QAEAAL/2gAIAQEAAD8A/wDyNnj/0P8A9yj1BP/R0uRQJLH/2Q=="
    ),
    28: base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/yQALCAAQABgBAREA"
    "/8wABgAQEAX/2gAIAQEAAD8A0tlElO+6xUL87nYEDGr/2Q=="
    ),
    29: base64.b64decode(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQH/yQALCAAQABgBAREA"
    "/8wABgAQEAX/2gAIAQEAAD8A0ud6cw6tFlKLbmcZkP/Z"
    ),
}
