from .images import (
    GRID_STRUCT,
    IMAGES_SCHEMA,
    average_hash,
    images_dataset,
    make_fixture_images,
    make_oracle_images,
    oracle_grid_origin,
    oracle_pixels,
)
from .geotiff import read_geotiff, write_cog
from .open import open_raster, raster_dataset
from .zarr_lite import (
    list_zarr_chunks,
    read_zarr_window,
    read_zarr,
    read_zarr_chunk,
    write_zarr,
    write_zarr_tiles,
    zarr_raster,
)
from .geoimage import write_geoimages, world_file_text
from .netcdf import netcdf_dataset, netcdf_raster, read_netcdf, write_netcdf
from .geopackage import (
    read_geopackage_tiles,
    write_geopackage,
    write_geopackage_tiles,
)
from .ascii_grid import read_ascii_grid, write_ascii_grid
from .srtm import read_hgt, write_hgt
from .rawbin import read_rawbin, write_rawbin
from .shapefile import (
    read_shapefile,
    write_shapefile,
    write_shapefile_dataset,
)
from .geopackage import read_geopackage
from .vectors import (
    POINTS_SCHEMA,
    POLYGONS_SCHEMA,
    RING_TYPE,
    fixture_points,
    fixture_polygons,
    oracle_points_from_keys,
    read_vector_file,
    rings_to_numpy,
    vector_dataset,
)

__all__ = [
    "GRID_STRUCT",
    "IMAGES_SCHEMA",
    "average_hash",
    "images_dataset",
    "make_fixture_images",
    "make_oracle_images",
    "netcdf_dataset",
    "open_raster",
    "raster_dataset",
    "write_geoimages",
    "read_zarr",
    "read_zarr_chunk",
    "read_zarr_window",
    "list_zarr_chunks",
    "write_zarr",
    "write_zarr_tiles",
    "zarr_raster",
    "world_file_text",
    "netcdf_raster",
    "oracle_grid_origin",
    "oracle_pixels",
    "POINTS_SCHEMA",
    "POLYGONS_SCHEMA",
    "RING_TYPE",
    "fixture_points",
    "fixture_polygons",
    "oracle_points_from_keys",
    "read_geopackage_tiles",
    "read_geotiff",
    "read_netcdf",
    "rings_to_numpy",
    "write_cog",
    "write_geopackage",
    "write_geopackage_tiles",
    "write_netcdf",
    "read_ascii_grid",
    "write_ascii_grid",
    "read_hgt",
    "write_hgt",
    "read_rawbin",
    "write_rawbin",
    "read_shapefile",
    "write_shapefile",
    "write_shapefile_dataset",
    "read_geopackage",
    "read_vector_file",
    "vector_dataset",
]
