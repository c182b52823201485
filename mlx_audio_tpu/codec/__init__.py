"""Neural audio codecs (SURVEY.md §2.4): Mimi, EnCodec, SNAC, DAC, Vocos,
BigVGAN, S3 — every TTS family routes through one of these."""
