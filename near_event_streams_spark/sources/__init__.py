"""Sources: streamer-message readers (batch + streaming) and table loaders."""
