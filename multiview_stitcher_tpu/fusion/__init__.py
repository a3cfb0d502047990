from multiview_stitcher_tpu.fusion._core import (  # noqa: F401
    calc_fusion_stack_properties,
    calc_stack_properties_from_view_properties_and_params,
    calc_stack_properties_from_volume,
    combine_stack_props,
    fuse,
    fuse_np,
    fuse_to_multiscale_ome_zarr,
    fuse_to_zarr,
    max_fusion,
    process_output_stack_properties,
    simple_average_fusion,
    weighted_average_fusion,
)
