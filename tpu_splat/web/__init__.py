"""Local web console + in-browser splat viewer.

The self-hosted analog of the reference's Gradio console and embedded web
viewer (Gradio/app.py:237-331 job console; generate_splat_gradio.py:883-1017,
1309-1376 splat viewer iframe): a zero-dependency stdlib HTTP server that
submits job JSONs, polls the JobStore, and renders finished splats in a
WebGL2 viewer.
"""
