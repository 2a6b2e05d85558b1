"""Side tools: beam-search decoding, caption metrics, visualization, sampling."""
