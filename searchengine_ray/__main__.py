from searchengine_ray.cli import main

raise SystemExit(main())
