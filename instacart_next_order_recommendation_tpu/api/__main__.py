from instacart_next_order_recommendation_tpu.api.app import main

main()
