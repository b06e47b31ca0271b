"""Sources: synthetic Common-Crawl-style corpus generator + table loaders."""
