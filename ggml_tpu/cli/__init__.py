"""Console entry points (pyproject [project.scripts]): the installable
analogs of the reference's example binaries — generate (gpt-2/gpt-j main),
server (llama-server), quantize_gguf (quantize tools), embed, finetune,
transcribe (whisper), gguf_dump (gguf-dump)."""
