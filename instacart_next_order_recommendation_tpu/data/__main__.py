from instacart_next_order_recommendation_tpu.data.prepare import main

main()
