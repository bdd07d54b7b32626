from diffsci_tpu.cli import main

raise SystemExit(main())
