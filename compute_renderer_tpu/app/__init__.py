"""Application layer: headless frame loop + optional interactive viewer.

Replaces the reference's winit window/event-loop (src/window.rs) and the
present pass (src/custom_pipeline/present_pass.rs): on TPU the 'present' is a
host blit of the device-resident RGBA framebuffer — to PNG files headlessly,
or to a window when a display exists.
"""
