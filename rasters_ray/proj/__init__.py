from .crs import (
    WGS84,
    CRSInfo,
    center_aeqd,
    crs_equal,
    is_geographic,
    local_UTM_EPSG,
    local_UTM_proj4,
    parse_crs,
)
from .transform import transform_point, transform_xy

__all__ = [
    "WGS84",
    "CRSInfo",
    "center_aeqd",
    "crs_equal",
    "is_geographic",
    "local_UTM_EPSG",
    "local_UTM_proj4",
    "parse_crs",
    "transform_point",
    "transform_xy",
]
